import { Stack } from 'expo-router'
import React from 'react'

export default function RootLayout() {
  return (
    <Stack
      screenOptions={{
        headerStyle: { backgroundColor: '#fff' },
        headerTintColor: '#111827',
        contentStyle: { backgroundColor: '#f6f7f9' },
      }}
    >
      <Stack.Screen name="index" options={{ title: '건강 정보 제출' }} />
      <Stack.Screen name="result" options={{ title: '분석 결과' }} />
    </Stack>
  )
}
